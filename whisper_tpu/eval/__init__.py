from . import wer
