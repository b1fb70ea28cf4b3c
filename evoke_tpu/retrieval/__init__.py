from evoke_tpu.retrieval.topk import TopKIndex, attach_specific_knowledge
