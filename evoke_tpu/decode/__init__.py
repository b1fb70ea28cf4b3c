from evoke_tpu.decode.beam import beam_search, greedy_sample, penalty_fn
