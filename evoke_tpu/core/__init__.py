from evoke_tpu.core.config import EvokeConfig, load_config
from evoke_tpu.core.mesh import MeshSpec, create_mesh, shard_batch, replicate
