from . import logging, profiling
