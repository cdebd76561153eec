"""Octree payload data-format descriptor.

TPU-native analogue of the reference's ``DataFormat``
(reference: ``src/data_format.cpp:5-41``, ``include/data_format.hpp``).
Parses strings like ``"SH16"`` / ``"RGBA"`` into a (format, basis_dim) pair.
"""

from __future__ import annotations

import dataclasses


RGBA = "RGBA"
SH = "SH"


@dataclasses.dataclass(frozen=True)
class DataFormat:
    format: str = RGBA
    basis_dim: int = -1

    @staticmethod
    def parse(s: str) -> "DataFormat":
        """Parse a format string (reference ``src/data_format.cpp:5-24``).

        The leading alphabetic run selects the family (``SH`` or anything
        else -> RGBA); the numeric suffix, if present, is the basis dim.
        """
        nonalph = -1
        for i, ch in enumerate(s):
            if not ch.isalpha():
                nonalph = i
                break
        if nonalph != -1:
            try:
                basis_dim = int(s[nonalph:])
            except ValueError:
                basis_dim = 0
            fam = s[:nonalph]
            fmt = SH if fam == "SH" else RGBA
            return DataFormat(format=fmt, basis_dim=basis_dim)
        return DataFormat(format=RGBA, basis_dim=-1)

    def to_string(self) -> str:
        out = self.format if self.format in (SH, RGBA) else "UNKNOWN"
        if self.basis_dim != -1:
            out += str(self.basis_dim)
        return out

    def __str__(self) -> str:  # pragma: no cover - convenience
        return self.to_string()
