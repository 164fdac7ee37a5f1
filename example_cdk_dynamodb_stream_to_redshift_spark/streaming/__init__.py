from .boilerplate_maintenance import SegmentDocFreqStore  # noqa: F401
from .cluster_maintenance import ClusterMaintenance  # noqa: F401
from .corpus import CorpusIngestPipeline  # noqa: F401
from .drift_maintenance import ProfileMonitor  # noqa: F401
from .heavyhitter_maintenance import HeavyHitterMaintenance  # noqa: F401
from .pipeline import CdcPipeline  # noqa: F401
from .quality_monitor import BatchContractError, QualityGate  # noqa: F401
from .rarity_maintenance import ShingleDocFreqStore  # noqa: F401
from .sample_maintenance import BottomKSample  # noqa: F401
from .selection_maintenance import BudgetHistogram  # noqa: F401
from .sketch_maintenance import KmvSketchMaintenance  # noqa: F401
