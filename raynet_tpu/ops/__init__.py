"""JAX/XLA/Pallas compute ops — the single accelerated, differentiable
implementation of every kernel the reference triplicated as numpy/TF/CUDA.
"""
