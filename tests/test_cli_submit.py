"""Real ``spark-submit --py-files`` end-to-end test.

The north-rule deployment shape is ``spark-submit --py-files
abap.zip __main__.py link ...`` on a cluster whose sizing the
submitter owns. This test runs that EXACT invocation against the
pyspark distribution's own ``bin/spark-submit``: the package is
shipped ONLY as a zip (the subprocess gets no PYTHONPATH and a
temp cwd, and spark-submit adds the primary script's directory —
the package dir itself, from which the package is not importable —
so any import that doesn't come from ``--py-files`` fails), and the
submitted ``--master local[4]`` must win over the library's tuned
local defaults (the PYSPARK_GATEWAY_PORT detection in
``__main__._session``).
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "ai_bangladesh_address_parser_spark"
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _zip_package(dest: str) -> None:
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(
    not os.access(SPARK_SUBMIT, os.X_OK), reason="no spark-submit launcher"
)
def test_spark_submit_py_files_link(spark, tmp_path):
    from ai_bangladesh_address_parser_spark.sources.pages import synth_pages

    pages, truth = synth_pages(spark, n_pages=200, n_entities=50)
    inp = str(tmp_path / "pages")
    pages.write.parquet(inp)

    zip_path = str(tmp_path / "abap.zip")
    _zip_package(zip_path)

    out = str(tmp_path / "entities")
    ckpt = str(tmp_path / "ckpt")
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(REPO, PKG, "__main__.py"),
        "link", "--input", inp, "--output", out, "--checkpoint", ckpt,
        "--scorer", "levenshtein", "--threshold", "0.85",
    ]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PYSPARK_GATEWAY_PORT", "PYSPARK_GATEWAY_SECRET")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # the CLI prints per-stage metrics (spark-submit's launcher routes
    # the Python driver's stderr into stdout, so search both)
    streams = proc.stdout + proc.stderr
    assert "metric s1_mentions" in streams, streams[-2000:]
    assert "metric s1_gate" in streams

    ents = spark.read.parquet(out)
    rows = ents.select("url", "entity_id").collect()
    assert len(rows) == 200
    # clusters reproduce truth exactly (same F1-1.0 contract the
    # in-process pipeline tests pin)
    t = {r.url: r.truth_entity_id for r in truth.collect()}
    by_pred: dict[str, set] = {}
    for r in rows:
        by_pred.setdefault(r.entity_id, set()).add(t[r.url])
    assert all(len(v) == 1 for v in by_pred.values())  # no impure cluster
    by_truth: dict[str, set] = {}
    for r in rows:
        by_truth.setdefault(t[r.url], set()).add(r.entity_id)
    assert all(len(v) == 1 for v in by_truth.values())  # no split entity

    # resumability artifacts exist: per-stage checkpoint dirs under
    # the submitted --checkpoint base
    assert os.path.isdir(ckpt) and os.listdir(ckpt)


@pytest.mark.skipif(
    not os.access(SPARK_SUBMIT, os.X_OK), reason="no spark-submit launcher"
)
def test_spark_submit_zip_is_only_source(tmp_path):
    """Negative control: the same submit WITHOUT --py-files fails on
    import — proving the positive test's imports really were served
    from the shipped zip, not from a leaked path."""
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[2]",
        "--conf", "spark.ui.enabled=false",
        os.path.join(REPO, PKG, "__main__.py"),
        "link", "--input", "/nonexistent", "--output", str(tmp_path / "o"),
    ]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PYSPARK_GATEWAY_PORT", "PYSPARK_GATEWAY_SECRET")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode != 0
    streams = proc.stdout + proc.stderr
    assert "ModuleNotFoundError" in streams or "ImportError" in streams
