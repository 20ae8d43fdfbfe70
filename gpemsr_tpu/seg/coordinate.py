"""Element-wise integer coordinate tuple.

Capability parity with the reference's `Coordinate`
(inference_code/utils/coordinate.py:3 — used by its gunpowder-style data
plumbing; dead code for the shipped configs, provided for completeness).
Semantics: a tuple of ints (None entries pass through), with element-wise
+, -, *, /, //, abs and negation; scalar operands broadcast.
"""

from __future__ import annotations

import numbers


class Coordinate(tuple):
    """A tuple of integers supporting element-wise arithmetic.

    >>> Coordinate((2, 3, 4)) * Coordinate((10, 5, 1))
    (20, 15, 4)
    """

    def __new__(cls, array_like):
        return super().__new__(
            cls, [int(x) if x is not None else None for x in array_like])

    def dims(self) -> int:
        return len(self)

    def __neg__(self):
        return Coordinate(-a if a is not None else None for a in self)

    def __abs__(self):
        return Coordinate(abs(a) if a is not None else None for a in self)

    def _zip(self, other, op, opname):
        if isinstance(other, tuple):
            assert self.dims() == len(other), \
                f"can only {opname} Coordinate of equal dimensions"
            return Coordinate(
                op(a, b) if a is not None and b is not None else None
                for a, b in zip(self, other))
        if isinstance(other, numbers.Number):
            return Coordinate(
                op(a, other) if a is not None else None for a in self)
        raise TypeError(
            f"can only {opname} Coordinate with tuple or number, "
            f"not {type(other)}")

    def __add__(self, other):
        return self._zip(other, lambda a, b: a + b, "add")

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        return self._zip(other, lambda a, b: a - b, "subtract")

    def __mul__(self, other):
        return self._zip(other, lambda a, b: a * b, "multiply")

    def __rmul__(self, other):
        return self.__mul__(other)

    def __div__(self, other):
        return self._zip(other, lambda a, b: a / b, "divide")

    def __truediv__(self, other):
        return self._zip(other, lambda a, b: a / b, "divide")

    def __floordiv__(self, other):
        return self._zip(other, lambda a, b: a // b, "floor-divide")

    def __mod__(self, other):
        return self._zip(other, lambda a, b: a % b, "mod")
