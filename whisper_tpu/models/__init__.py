from . import whisper
