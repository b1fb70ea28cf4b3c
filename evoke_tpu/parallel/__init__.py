from evoke_tpu.parallel.tp import shard_params_tp, tp_spec_for_path
from evoke_tpu.parallel.collectives import all_gather_batch, psum_mean
