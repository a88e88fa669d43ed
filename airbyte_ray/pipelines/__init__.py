from .replay import LakeTable, ReplayConfig, lww_reduce, stable_hash  # noqa: F401
