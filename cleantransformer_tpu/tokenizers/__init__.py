from cleantransformer_tpu.tokenizers.bpe import (  # noqa: F401
    BPETokenizer, WordPieceTokenizer, wordpunct_tokenize,
)
from cleantransformer_tpu.tokenizers.bert import BasicTokenizer, BertTokenizer  # noqa: F401
