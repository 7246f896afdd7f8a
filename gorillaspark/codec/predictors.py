"""Value predictors for the Gorilla value stream.

Format parity targets (semantics only, re-expressed from scratch):
`predictors/LastValuePredictor.java:10-22` and
`predictors/DifferentialFCM.java:10-47` in the reference.
"""

from __future__ import annotations

_U64 = (1 << 64) - 1


def _to_signed64(x: int) -> int:
    x &= _U64
    return x - (1 << 64) if x >= (1 << 63) else x


class LastValuePredictor:
    """predict() = last seen value (the classic Gorilla model)."""

    __slots__ = ("_val",)

    def __init__(self) -> None:
        self._val = 0

    def update(self, value: int) -> None:
        self._val = value & _U64

    def predict(self) -> int:
        return self._val


class DifferentialFCM:
    """Differential finite-context-method predictor.

    Table size rounds up to the next power of two; hash chain is
    ``h = ((h << 5) ^ ((v - last) >> 50)) & mask`` with an *arithmetic*
    shift on the signed 64-bit delta (`DifferentialFCM.java:37-41`).

    Note the reference's encode/decode update asymmetry on repeated
    values (encoder updates on xor==0, decoder does not —
    `ValueCompressor.java:34-35` vs `ValueDecompressor.java:53`); we
    mirror the same call pattern in the codec, never here.
    """

    __slots__ = ("_table", "_mask", "_last", "_hash")

    def __init__(self, size: int = 1024) -> None:
        if size <= 0:
            raise ValueError("size must be positive")
        # Java: newSize = 1 << (64 - numberOfLeadingZeros(size - 1))
        size -= 1
        n = 1 if size == 0 else 1 << size.bit_length()
        # Java's 1 << k uses the low 5/6 bits of k on ints; for size-1 == 0
        # numberOfLeadingZeros(0) == 64 → 1 << 64 == 1 on Java ints.
        self._table = [0] * n
        self._mask = n - 1
        self._last = 0
        self._hash = 0

    def update(self, value: int) -> None:
        value &= _U64
        delta = (value - self._last) & _U64
        self._table[self._hash] = delta
        # arithmetic >> 50 on the signed view of delta
        sh = _to_signed64(delta) >> 50
        self._hash = ((self._hash << 5) ^ sh) & self._mask
        self._last = value

    def predict(self) -> int:
        return (self._table[self._hash] + self._last) & _U64


def make_predictor(name: str):
    """Factory used by the codec; name ∈ {'last_value', 'dfcm'}."""
    if name == "last_value":
        return LastValuePredictor()
    if name == "dfcm" or name.startswith("dfcm:"):
        size = int(name.split(":", 1)[1]) if ":" in name else 1024
        return DifferentialFCM(size)
    raise ValueError(f"unknown predictor {name!r}")
