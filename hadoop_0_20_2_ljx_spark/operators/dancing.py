"""Exact-cover (dancing-links) search: pentomino tiling, distributed by
prefix split.

Reference parity: examples/dancing/DancingLinks.java (Algorithm X with
``split(depth)`` prefix enumeration and ``solve(prefix)`` replay),
Pentomino.java:269-283 (the 12 piece shapes / rotation+flip sets),
Pentomino.java:306-345 (placement generation incl. the upper-left
restriction on the first piece that prunes trivially-symmetric solutions),
DistributedPentomino.java:40-60 (each map task solves one prefix).

Spark-first shape: the *search* is inherently imperative CPU work, not a
data-flow — exactly the case the brief reserves for per-partition Python.
The driver enumerates choice-index prefixes of bounded depth (cheap, node
count = branching^depth), parallelizes them, and each task independently
replays its prefix and exhausts that subtree.  No shuffle at all until the
final count/collect; work scales out with the number of prefixes, the same
economics as the reference's map-per-prefix design.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

# (name, picture, flippable, n_rotations) — transcription of the public
# piece table in Pentomino.initializePieces (Pentomino.java:269-283).
PIECES: list[tuple[str, str, bool, int]] = [
    ("x", " x /xxx/ x ", False, 1),
    ("v", "x  /x  /xxx", False, 4),
    ("t", "xxx/ x / x ", False, 4),
    ("w", "  x/ xx/xx ", False, 4),
    ("u", "x x/xxx", False, 4),
    ("i", "xxxxx", False, 2),
    ("f", " xx/xx / x ", True, 4),
    ("p", "xx/xx/x ", True, 4),
    ("z", "xx / x / xx", True, 2),
    ("n", "xx  / xxx", True, 4),
    ("y", "  x /xxxx", True, 4),
    ("l", "   x/xxxx", True, 4),
]


def _parse(picture: str) -> list[tuple[int, int]]:
    cells = []
    for y, line in enumerate(picture.split("/")):
        for x, ch in enumerate(line):
            if ch == "x":
                cells.append((x, y))
    return cells


def _orientations(picture: str, flippable: bool, n_rot: int) -> list[list[tuple[int, int]]]:
    """All distinct (rotation x optional flip) cell sets, origin-normalized."""
    base = _parse(picture)
    variants = [base] + ([[(-x, y) for x, y in base]] if flippable else [])
    out, seen = [], set()
    for cells in variants:
        cur = cells
        for _ in range(n_rot):
            norm_x = min(x for x, _ in cur)
            norm_y = min(y for _, y in cur)
            norm = tuple(sorted((x - norm_x, y - norm_y) for x, y in cur))
            if norm not in seen:
                seen.add(norm)
                out.append(list(norm))
            cur = [(-y, x) for x, y in cur]  # 90° rotation
    return out


def _is_side(offset: int, size: int, board: int) -> bool:
    # Pentomino.java:293 — "is it in the upper/left?"
    return 2 * offset + size <= board


def pentomino_rows(
    width: int, height: int, restrict_first: bool = True
) -> list[tuple[str, tuple[int, ...]]]:
    """Every legal placement of every piece as an exact-cover row:
    (piece_name, covered board-cell indices).  ``restrict_first`` pins the
    x-piece to the upper-left closed quadrant, the reference's symmetry
    prune (Pentomino.java:306-345)."""
    rows = []
    for idx, (name, picture, flippable, n_rot) in enumerate(PIECES):
        for cells in _orientations(picture, flippable, n_rot):
            w = max(x for x, _ in cells) + 1
            h = max(y for _, y in cells) + 1
            for ox in range(width - w + 1):
                for oy in range(height - h + 1):
                    if restrict_first and idx == 0 and not (
                        _is_side(ox, w, width) and _is_side(oy, h, height)
                    ):
                        continue
                    covered = tuple(sorted((oy + y) * width + (ox + x) for x, y in cells))
                    rows.append((name, covered))
    return rows


class ExactCover:
    """Algorithm X over dict-of-sets (same search tree as DancingLinks.java;
    the linked-list trick only changes constant factors).  Column choice is
    deterministic (min size, then column id) so prefix replay is stable
    across driver and executors — the property DistributedPentomino relies
    on when a map task re-walks its prefix."""

    def __init__(self, rows: list[tuple[str, tuple[int, ...]]], n_cells: int):
        self.rows = rows
        # columns: 0..n_cells-1 are board cells, then one per piece name
        piece_col = {}
        for name, _ in rows:
            if name not in piece_col:
                piece_col[name] = n_cells + len(piece_col)
        self.row_cols: list[tuple[int, ...]] = [
            (piece_col[name],) + covered for name, covered in rows
        ]
        self.cols: dict[int, set[int]] = {}
        for c in range(n_cells + len(piece_col)):
            self.cols[c] = set()
        for r, rc in enumerate(self.row_cols):
            for c in rc:
                self.cols[c].add(r)

    def _select(self, r: int) -> list[set[int]]:
        removed = []
        for c in self.row_cols[r]:
            for rr in self.cols[c]:
                for cc in self.row_cols[rr]:
                    if cc != c:
                        self.cols[cc].discard(rr)
            removed.append(self.cols.pop(c))
        return removed

    def _deselect(self, r: int, removed: list[set[int]]) -> None:
        for c, rows in zip(reversed(self.row_cols[r]), reversed(removed)):
            self.cols[c] = rows
            for rr in rows:
                for cc in self.row_cols[rr]:
                    if cc != c:
                        self.cols[cc].add(rr)

    def _choose(self) -> int:
        return min(self.cols, key=lambda c: (len(self.cols[c]), c))

    def solve(self, prefix: tuple[int, ...] = ()) -> Iterator[list[int]]:
        """Yield complete solutions (row-index lists) in the subtree reached
        by replaying ``prefix`` (choice indexes per level, reference
        split/solve contract, DancingLinks.java)."""
        picked: list[int] = []
        trail: list[tuple[int, list[set[int]]]] = []
        ok = True
        for choice in prefix:
            if not self.cols:
                ok = False
                break
            c = self._choose()
            cands = sorted(self.cols[c])
            if choice >= len(cands):
                ok = False
                break
            r = cands[choice]
            trail.append((r, self._select(r)))
            picked.append(r)
        if ok:
            yield from self._search(picked)
        for r, removed in reversed(trail):
            self._deselect(r, removed)

    def _search(self, picked: list[int]) -> Iterator[list[int]]:
        if not self.cols:
            yield list(picked)
            return
        c = self._choose()
        for r in sorted(self.cols[c]):
            removed = self._select(r)
            picked.append(r)
            yield from self._search(picked)
            picked.pop()
            self._deselect(r, removed)

    def splits(self, depth: int) -> list[tuple[int, ...]]:
        """All viable choice-index prefixes of length ``depth``
        (DancingLinks.split): dead branches are kept out by a quick
        non-empty check, matching the reference's pruned enumeration."""
        out: list[tuple[int, ...]] = []

        def walk(prefix: tuple[int, ...], level: int) -> None:
            if level == depth:
                out.append(prefix)
                return
            if not self.cols:
                return
            c = self._choose()
            for i, r in enumerate(sorted(self.cols[c])):
                removed = self._select(r)
                walk(prefix + (i,), level + 1)
                self._deselect(r, removed)

        walk((), 0)
        return out


def solution_board(rows: list[tuple[str, tuple[int, ...]]], sol: list[int], width: int, height: int) -> str:
    grid = ["."] * (width * height)
    for r in sol:
        name, covered = rows[r]
        for cell in covered:
            grid[cell] = name
    return "".join(grid)


def distributed_pentomino(
    spark: SparkSession,
    width: int = 6,
    height: int = 10,
    depth: int = 2,
    restrict_first: bool = True,
) -> DataFrame:
    """DistributedPentomino.java:40-60 as a Spark job: enumerate prefixes on
    the driver (cheap — branching^depth nodes), one task per prefix, each
    task replays its prefix and exhausts the subtree.  Output rows
    (prefix, solution) mirror the reference's Text/Text map output."""
    if width * height != 60:
        raise ValueError("pentomino board must have exactly 60 cells")
    rows = pentomino_rows(width, height, restrict_first)
    model = ExactCover(rows, width * height)
    prefixes = model.splits(depth)

    def solve_split(parts: Iterator[tuple[int, ...]]) -> Iterator[tuple[str, str]]:
        local = ExactCover(rows, width * height)
        for prefix in parts:
            key = " ".join(map(str, prefix))
            for sol in local.solve(prefix):
                yield key, solution_board(rows, sol, width, height)

    # Pack prefixes into ~core-count partitions: one ExactCover build and
    # one Python-worker round trip per partition, not per prefix. Round-robin
    # by index spreads the (mildly skewed) subtree costs.
    sc = spark.sparkContext
    n_parts = max(1, min(sc.defaultParallelism, len(prefixes)))
    rdd = sc.parallelize(prefixes, n_parts).mapPartitions(solve_split)
    # explicit schema: schema inference would run the whole search twice
    return spark.createDataFrame(rdd, "prefix string, solution string")
