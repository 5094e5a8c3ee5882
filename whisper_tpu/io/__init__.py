from . import checkpoint, mpk, npy_tree, wav
