from .incremental import SyncEngine  # noqa: F401
from .replay import LakeTable, ReplayConfig, lww_reduce, stable_hash  # noqa: F401
