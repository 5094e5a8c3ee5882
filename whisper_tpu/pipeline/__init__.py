from . import transcribe
