"""Device-mesh parallelism: batch-sharded data parallelism over ICI via
jax.sharding + jit (the reference has NO distributed execution — SURVEY.md
§2.3; this is new TPU-native design surface, not a port)."""

from .mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicate_sharding,
    shard_batch,
    replicate,
)
from .fsdp import (  # noqa: F401
    fsdp_spec,
    fsdp_shardings,
    fsdp_shard,
    shard_fraction,
)
