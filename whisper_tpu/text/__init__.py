from . import tokenizer
