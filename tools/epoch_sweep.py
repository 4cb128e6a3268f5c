"""Registry-wide PRE-1970 timestamp replay: shift events.ts back 80
years (2024 -> 1944, every epoch value negative) and oracle-compare all
186 registry queries — negative-epoch integer division is the classic
truncation-vs-floor divergence between engines, and corrupt/ancient
timestamps are routine in real crawl data.

    python tools/epoch_sweep.py            # exit 1 on ANY divergence

Expected: ZERO divergences. The r8 ad-hoc run measured 185/186 — the
one failure was the JS-drift oracle's unguarded empty slice (every row
landed in one drift window), fixed that round; the full registry has
replayed green on negative epochs since. This tool makes that a
standing gate: the engine-wide `div`-not-`/` epoch discipline
(queries/base.py) is exactly the kind of contract a new query can
silently break.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def build_pre1970_fixture(dst: str) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        src = f"{SRC_SF}/{t}.parquet"
        if t != "events":
            shutil.copyfile(src, f"{dst}/{t}.parquet")
            continue
        tab = pq.read_table(src)
        ts = tab["ts"].combine_chunks()
        unit = ts.type.unit  # the fixture writes TIMESTAMP(NANOS)
        per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        shift = int(80 * 365.25 * 86400) * per_sec
        shifted = pc.subtract(ts.cast(pa.int64()), shift).cast(ts.type)
        cols = {n: (shifted if n == "ts" else tab[n]) for n in tab.column_names}
        pq.write_table(pa.table(cols), f"{dst}/{t}.parquet")


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from boundary import replay_and_diff

    dst = os.path.join(tempfile.gettempdir(), "ljx_sf_pre1970")
    return replay_and_diff(build_pre1970_fixture, dst, set(), "pre-1970")


if __name__ == "__main__":
    raise SystemExit(main())
