"""Registry-wide empty-input contract.

At 100 TB a day's partition being empty is routine (a stalled crawl,
a filtered-out source, a brand-new collection) — no query should turn
that into a crash. This sweep runs EVERY registered query against a
sf-dir whose ten tables all have zero rows (schemas copied verbatim
from /root/testdata/sf0.001) and asserts each one either

  * executes and returns rows (global aggregates legitimately return
    a single all-null/zero row), or
  * raises ``ValueError`` with a message — the documented clean-error
    escape hatch for operators whose preconditions genuinely require
    data (e.g. an ML fit); an opaque TypeError/IndexError/Py4J error
    is a bug.

The r08 sweep that introduced this test caught exactly one violation:
``ann_store_probe`` subscripted the ``None`` returned by ``head()``
on the empty embeddings table (fixed in queries_vector.py to return
an empty result with the probe's schema).
"""

from __future__ import annotations

import glob
import os

import pytest

import __spark_entry__ as entry


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory):
    """All ten testdata tables, zero rows, schemas copied from sf0.001."""
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    for path in sorted(glob.glob(src + "/*.parquet")):
        table = os.path.basename(path)
        schema = spark.read.parquet(path).schema
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            f"{dst}/{table}"
        )
    return dst


@pytest.mark.slow
def test_registry_empty_input_contract(spark, empty_sf_dir):
    failures = []
    for name, fn in sorted(entry.queries().items()):
        try:
            fn(spark, empty_sf_dir).take(1)
        except ValueError:
            # documented precondition error — acceptable (and must be
            # a ValueError, not an opaque crash class)
            continue
        except Exception as ex:  # noqa: BLE001 — the sweep reports all
            failures.append(f"{name}: {type(ex).__name__}: {str(ex).splitlines()[0][:160]}")
    assert not failures, (
        f"{len(failures)} queries crash on empty input:\n" + "\n".join(failures)
    )
