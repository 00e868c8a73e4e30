"""Z-order (Morton) clustering keys + zonemap pruning arithmetic.

The data-layout primitive behind multi-dimensional data skipping
(Delta ``OPTIMIZE ZORDER BY``, Iceberg sort orders, the classic
UB-tree): interleave the bits of two normalized integer keys so rows
close in BOTH dimensions land in the same file/bucket, making min/max
zonemaps selective for 2-D predicates where a linear sort is selective
in one dimension only.

At 100 TB this is a WRITE-side operator: cluster-by-morton before the
sink, and every downstream scan with a 2-D predicate prunes
row-groups/files by footer statistics alone. The queries built on it
(queries/relational.py ``zorder_layout_pruning``) measure exactly that
effect: zonemap hit-rate of a z-ordered layout vs a linear layout over
the same rows, same bucket count.

All arithmetic is plain 64-bit integer ops (shifts, masks, or) with
the standard magic-number bit spreading, expressed per dialect so
DuckDB can run the byte-identical computation as the oracle.
"""

from __future__ import annotations

# (shift, mask) chain spreading a 16-bit value so its bits occupy the
# even positions of a 32-bit word: the classic Morton magic numbers.
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]

MORTON_BITS = 32  # two 16-bit dimensions


def _shl(dialect: str, e: str, n: int) -> str:
    return f"shiftleft({e}, {n})" if dialect == "spark" else f"(({e}) << {n})"


def spread16_expr(dialect: str, col: str) -> str:
    """Bits of a 16-bit nonnegative `col` moved to even positions."""
    e = f"(cast({col} as bigint) & 65535)"
    for shift, mask in _SPREAD:
        e = f"(({e} | {_shl(dialect, e, shift)}) & {mask})"
    return e


def morton2_expr(dialect: str, x: str, y: str) -> str:
    """32-bit Morton interleave of two 16-bit keys (x even bits, y odd).

    Inputs must already be normalized to [0, 65536); values are masked,
    not checked — normalize with a scale factor first if the domain is
    wider."""
    return f"({spread16_expr(dialect, x)} | {_shl(dialect, spread16_expr(dialect, y), 1)})"
