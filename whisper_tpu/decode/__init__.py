from . import beam, greedy, host_beam, speculative
