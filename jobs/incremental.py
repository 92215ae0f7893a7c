"""spark-submit entry point: merge a new transcript batch into an index.

    spark-submit --py-files engine.zip jobs/incremental.py \
        --input /data/new_batch --index /data/index
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from search_engine_spark.operators.incremental import incremental_update  # noqa: E402
from search_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--index", required=True)
    args = ap.parse_args()

    spark = get_spark(app_name="incremental_update")
    res = incremental_update(spark, spark.read.parquet(args.input), args.index)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
