from .corpus import CorpusIngestPipeline  # noqa: F401
from .pipeline import CdcPipeline  # noqa: F401
