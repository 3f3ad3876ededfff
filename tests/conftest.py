import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taco_toolbox_spark.datagen import generate_transcripts
from taco_toolbox_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # no ansi override: session.py pins ansi off engine-wide, and the
    # suite must validate the same config production sessions get
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(spark):
    """Small seeded corpus with a high violation rate so every check fires."""
    c = generate_transcripts(
        spark,
        n_convs=300,
        seed=42,
        violation_denom=300,
        hot_conv_every=100,
        hot_len=200,
    )
    c.clean = c.clean.cache()
    c.corrupted = c.corrupted.cache()
    c.manifest = c.manifest.cache()
    return c


@pytest.fixture(scope="session")
def corrupted_pdf(corpus):
    return corpus.corrupted.toPandas()


@pytest.fixture(scope="session")
def clean_pdf(corpus):
    return corpus.clean.toPandas()
