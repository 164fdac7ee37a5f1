from .merge import (  # noqa: F401
    MergeSpec,
    MEMBER_SPEC,
    QUEST_SPEC,
    MEMBER_QUEST_SPEC,
    incremental_merge,
)
