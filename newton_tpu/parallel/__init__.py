from .envs import batch_state, shard_batched_state, unbatch_env, vmap_step

__all__ = ["batch_state", "shard_batched_state", "unbatch_env", "vmap_step"]
