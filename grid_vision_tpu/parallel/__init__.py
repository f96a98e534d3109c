"""Device-mesh parallelism: rig fleets (data parallel) and sharded training."""

from .mesh import make_mesh, shard_params  # noqa: F401
from .fleet import Fleet  # noqa: F401
from .multi_fleet import MultiFleet  # noqa: F401
