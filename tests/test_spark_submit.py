"""The north rule's launch mode, executed literally: `spark-submit
--py-files <zip> jobs/validate.py` as a SUBPROCESS, with the job script
copied to a scratch directory so the library can ONLY be imported from
the archive — the exact executor-side import path of a multi-node
cluster, where the repo checkout does not exist on workers.

(The in-process CLI tests in test_validate_cli.py cover batching /
resume / crash semantics; this one covers the deployment packaging.)
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.package import build_zip  # noqa: E402


def test_spark_submit_py_files_zip(spark, tmp_path):
    from taco_toolbox_spark.datagen import generate_transcripts, write_corpus

    corpus = str(tmp_path / "corpus")
    gen = generate_transcripts(spark, n_convs=80, seed=7, violation_denom=100)
    write_corpus(gen, corpus)

    zp = build_zip(str(tmp_path / "lib.zip"))
    # archive sanity: package root importable from the zip top level
    import zipfile

    names = zipfile.ZipFile(zp).namelist()
    assert "taco_toolbox_spark/__init__.py" in names
    assert not any("__pycache__" in n for n in names)

    # job script in a scratch dir: its sys.path.insert points at tmp_path,
    # which has no package — only --py-files can satisfy the import
    scratch = tmp_path / "jobs"
    scratch.mkdir()
    script = str(scratch / "validate.py")
    shutil.copyfile(os.path.join(REPO, "jobs", "validate.py"), script)

    out = str(tmp_path / "out")
    spark_home = os.environ.get("SPARK_HOME")
    submit = (
        os.path.join(spark_home, "bin", "spark-submit")
        if spark_home
        else shutil.which("spark-submit")
    )
    if submit is None or not os.path.exists(submit):
        pytest.skip("spark-submit launcher not on PATH")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # no backdoor to the repo checkout
    r = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zp,
            script,
            "--input", f"{corpus}/transcripts",
            "--baseline", f"{corpus}/transcripts_baseline",
            "--output", out,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    verd = spark.read.parquet(os.path.join(out, "verdicts"))
    assert verd.filter("NOT passed").count() > 0  # planted violations seen
    assert os.path.exists(os.path.join(out, "manifest.json"))
