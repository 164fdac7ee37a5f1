from .pipeline import CdcPipeline  # noqa: F401
