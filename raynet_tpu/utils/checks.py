"""Small assertion helpers shared across the numpy data layer.

Parity: raynet/utils/checks.py in the reference.
"""


def assert_col_vectors(a, b):
    assert a.ndim == 2 and a.shape[1] == 1, "expected column vector, got %r" % (a.shape,)
    assert b.ndim == 2 and b.shape[1] == 1, "expected column vector, got %r" % (b.shape,)
    assert a.shape == b.shape, "shape mismatch %r vs %r" % (a.shape, b.shape)


def assert_vector_with_wrong_size(v, size):
    assert len(v) == size, "expected vector of size %d, got %d" % (size, len(v))
