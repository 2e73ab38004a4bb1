import pytest


@pytest.fixture(scope="session")
def spark():
    from apollo_spark.session import get_spark
    s = get_spark("apollo-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    from apollo_spark import synth
    return synth.gen_corpus(200, seed=42)


@pytest.fixture(scope="session")
def images(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf.drop(columns=["gt_cluster"])) \
        .cache()


@pytest.fixture(scope="session")
def cfg():
    from apollo_spark.config import PipelineConfig
    return PipelineConfig(size=128, threshold=0.7)
