from .extract import build_extract  # noqa: F401
from .initial_load import (  # noqa: F401
    initial_load_members,
    initial_load_quests,
    initial_load_member_quests,
    initial_load_all,
)
