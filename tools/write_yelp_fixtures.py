"""Materialize the in-memory Yelp-shaped fixtures to committed parquet
(r2 VERDICT ask #8).

``yelp_basetable`` was the one pipeline surface with only a rows-only
driver row — its inputs lived in spark.createDataFrame literals, which
DuckDB cannot see. Writing the SAME fixtures (pipeline/fixtures.py,
every dirty-data quirk included) to single-file parquet under
``fixtures/yelp/`` lets the ``yelp_basetable_mini`` query and its
DuckDB oracle twin read identical bytes, turning the star-join +
null-repair pipeline into a hard-signal (hash-compared) row.

The files are committed: regenerating is only needed when
pipeline/fixtures.py changes (tests/test_yelp_parquet_fixtures.py
asserts parquet == in-memory so drift fails loudly).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "fixtures" / "yelp"


def main() -> None:
    sys.path.insert(0, str(REPO))
    from big_data_tools_spark.pipeline.fixtures import yelp_tables
    from big_data_tools_spark.session import get_spark

    spark = get_spark(app_name="bdt-yelp-fixtures")
    OUT.mkdir(parents=True, exist_ok=True)
    for name, df in yelp_tables(spark).items():
        with tempfile.TemporaryDirectory() as tmp:
            # single part file so each table is ONE flat .parquet file
            # both engines address identically
            df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/{name}")
            part = next(Path(f"{tmp}/{name}").glob("part-*.parquet"))
            shutil.copy(part, OUT / f"{name}.parquet")
        print(f"wrote {OUT / f'{name}.parquet'}")


if __name__ == "__main__":
    main()
