from .bpe import BPE, EOT_TEXT, SOT_TEXT, build_vocab, bytes_to_unicode, read_merges
from .cleaning import basic_clean, clean, whitespace_clean
from .tokenizer import ClipTokenizer, load_tokenizer, tokenize
