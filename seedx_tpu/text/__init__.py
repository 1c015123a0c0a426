from seedx_tpu.text.vocab import MultimodalVocab, DEFAULT_VOCAB  # noqa: F401
from seedx_tpu.text.tokenizer import ByteFallbackTokenizer, load_tokenizer  # noqa: F401
