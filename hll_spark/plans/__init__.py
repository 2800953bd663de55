from .checkpoint import CheckpointStore, checkpointed_sketch_aggregate

__all__ = ["CheckpointStore", "checkpointed_sketch_aggregate"]
