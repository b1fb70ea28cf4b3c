from evoke_tpu.data.tokenizer import WordTokenizer, build_tokenizer
