from .manifest import Manifest, PartitionEntry  # noqa: F401
