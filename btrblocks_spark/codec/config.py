"""Codec configuration — the BtrBlocksConfig analog.

Mirrors the reference's global config + scheme sets
(``/root/reference/btrblocks/btrblocks.hpp`` ``BtrBlocksConfig``,
``scheme/SchemeSet.hpp`` enable/disable,
``tools/examples/compression.cpp:38-48`` configure-before-use):
per-type enabled-scheme sets and the max cascade depth.

Process-local: Spark executor workers start from the defaults, so jobs
that need a non-default config must set it inside their kernels (or rely
on the explicit ``level=`` / ``force_scheme=`` arguments, which always
win). The pickers consult this config on every selection.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass, field

from btrblocks_spark import MAX_CASCADE_DEPTH
from btrblocks_spark.codec import numeric, strings

_ALL_INT = {
    numeric.UNCOMPRESSED,
    numeric.ONE_VALUE,
    numeric.DICT,
    numeric.RLE,
    numeric.FOR_BP,
    numeric.PFOR,
    numeric.DELTA_BP,
    numeric.FREQUENCY,
}
_ALL_DOUBLE = _ALL_INT | {numeric.PSEUDODECIMAL, numeric.DOUBLE_BP}
_ALL_STRING = {
    strings.UNCOMPRESSED,
    strings.ONE_VALUE,
    strings.DICT,
    strings.POOL_COMPRESS,
    strings.FSST,
}


@dataclass
class CodecConfig:
    integer_schemes: set[int] = field(default_factory=lambda: set(_ALL_INT))
    double_schemes: set[int] = field(default_factory=lambda: set(_ALL_DOUBLE))
    string_schemes: set[int] = field(default_factory=lambda: set(_ALL_STRING))
    max_cascade_depth: int = MAX_CASCADE_DEPTH

    def enable(self, kind: str, scheme: int) -> None:
        self._set(kind).add(scheme)

    def disable(self, kind: str, scheme: int) -> None:
        self._set(kind).discard(scheme)

    def _set(self, kind: str) -> set[int]:
        return {
            "integer": self.integer_schemes,
            "double": self.double_schemes,
            "string": self.string_schemes,
        }[kind]


_current = CodecConfig()


def get_config() -> CodecConfig:
    return _current


def configure(fn) -> CodecConfig:
    """Mutate the process config in place (BtrBlocksConfig::configure)."""
    fn(_current)
    return _current


def reset() -> None:
    global _current
    _current = CodecConfig()


@contextmanager
def scoped(**overrides):
    """Temporarily override config fields (tests)."""
    global _current
    saved = _current
    _current = CodecConfig(
        integer_schemes=set(overrides.get("integer_schemes", saved.integer_schemes)),
        double_schemes=set(overrides.get("double_schemes", saved.double_schemes)),
        string_schemes=set(overrides.get("string_schemes", saved.string_schemes)),
        max_cascade_depth=overrides.get(
            "max_cascade_depth", saved.max_cascade_depth
        ),
    )
    try:
        yield _current
    finally:
        _current = saved
