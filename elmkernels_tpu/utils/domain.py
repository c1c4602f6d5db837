"""Domain decomposition: partition a global (lat, lon) grid over hosts.

Rebuild of the reference's ``DomainDecomposition``
(``/root/reference/src/utils/utils.hh:13-35``, ``utils.cc:7-69``): each
host owns a contiguous lat×lon block and reads its own forcing hyperslab;
on device the block's cells flatten into the sharded column axis.
"""

from __future__ import annotations

import dataclasses
import math


def square_numprocs(nprocs: int) -> tuple[int, int]:
    """Factor nprocs into the most-square (ny, nx) grid (reference:
    ``utils.cc:7-24``)."""
    best = (1, nprocs)
    for ny in range(1, int(math.isqrt(nprocs)) + 1):
        if nprocs % ny == 0:
            best = (ny, nprocs // ny)
    return best


@dataclasses.dataclass(frozen=True)
class DomainDecomposition:
    """This host's block of the global grid."""
    n_global: tuple[int, int]   # (nlat, nlon)
    start: tuple[int, int]      # block start (lat0, lon0)
    n_local: tuple[int, int]    # block extent (nlat_local, nlon_local)

    @property
    def ncells(self) -> int:
        return self.n_local[0] * self.n_local[1]


def column_blocks(ncol: int, n_shards: int) -> tuple[list[tuple[int, int]],
                                                     int]:
    """Ceil-rule column blocks for a sharded axis that may not divide
    evenly.

    XLA's ``NamedSharding`` requires the sharded dimension to be
    divisible by the mesh axis, so the TPU-native handling of
    ``ncol % n_shards != 0`` is to PAD the global axis to the next
    multiple (``block * n_shards``) and ignore/mask the trailing pad
    columns (columns are independent, so pad columns are inert
    duplicates).  Returns ``([(lo, hi), ...], block)``: each shard's
    half-open range over the REAL columns (``hi - lo < block`` for the
    tail shard(s); possibly empty) plus the padded per-shard block
    size.  The reference's MPI analog needs no padding (``utils.cc:
    27-44`` hands rank ``p < rem`` one extra cell); here the pad is the
    price of one static SPMD executable.
    """
    block = -(-ncol // n_shards)
    return ([(min(i * block, ncol), min((i + 1) * block, ncol))
             for i in range(n_shards)], block)


def create_domain_decomposition_2d(n_global: tuple[int, int], nprocs: int,
                                   rank: int) -> DomainDecomposition:
    """Block-partition (nlat, nlon) over a (ny, nx) process grid
    (reference: ``utils.cc:46-69``)."""
    ny, nx = square_numprocs(nprocs)
    py, px = rank // nx, rank % nx
    nlat, nlon = n_global

    def block(n, p, np_):
        base, rem = divmod(n, np_)
        start = p * base + min(p, rem)
        size = base + (1 if p < rem else 0)
        return start, size

    lat0, nlat_l = block(nlat, py, ny)
    lon0, nlon_l = block(nlon, px, nx)
    return DomainDecomposition((nlat, nlon), (lat0, lon0), (nlat_l, nlon_l))
