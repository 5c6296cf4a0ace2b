"""Drop-in simulator entry point — the engine's analog of the reference's
``sales_data_simulator.py`` CLI (argparse: --gcs_bucket/--num_records/
--interval_min, infinite upload loop at :107-111).

    python -m sales_data_pipeline_gcp_spark.simulate --out_dir /watched/raw \
        [--num_records 100] [--interval_min 10] [--iterations 0] [--seed 42]

Differences from the reference, on purpose:
- the GCS bucket becomes a watched local/cluster directory (the streaming
  ingest in ``streaming/ingest.py`` picks files up exactly-once);
- ``--iterations`` bounds the loop (0 = run forever like the reference);
- the RNG is seeded per file for reproducibility (seed + iteration).
"""

from __future__ import annotations

import argparse
import os
import time
from datetime import datetime

from sales_data_pipeline_gcp_spark.sources.sales import generate_rows, write_csv


def emit_file(out_dir: str, num_records: int, seed: int) -> str:
    os.makedirs(out_dir, exist_ok=True)
    name = f"sales_data_{datetime.now().strftime('%Y%m%d%H%M%S')}_{seed}.csv"
    path = os.path.join(out_dir, name)
    write_csv(path, generate_rows(num_records, seed=seed))
    return path


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", required=True, help="watched landing directory (raw/ analog)")
    p.add_argument("--num_records", type=int, default=100)
    p.add_argument("--interval_min", type=float, default=10)
    p.add_argument("--iterations", type=int, default=1, help="0 = loop forever")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    i = 0
    while True:
        path = emit_file(args.out_dir, args.num_records, args.seed + i)
        print(f"wrote {path}")
        i += 1
        if args.iterations and i >= args.iterations:
            break
        time.sleep(args.interval_min * 60)


if __name__ == "__main__":
    main()
