from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from gorillaspark.plans.session import build_session
    s = build_session(app="gorillaspark-tests", master="local[4]",
                      shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts(spark):
    """Small deterministic transcript corpus, cached for the session."""
    from gorillaspark.sources.transcripts import generate_transcripts
    df = generate_transcripts(spark, n_conv=40, mean_turns=60, seed=42)
    df = df.cache()
    df.count()
    return df
