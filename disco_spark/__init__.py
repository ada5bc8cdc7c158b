"""disco_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of discoproject/disco (see SURVEY.md), plus
the large-scale training-data-pipeline operators the reference lacks
(dedup, similarity search, text analysis, streaming windows).
"""

from disco_spark.session import get_spark, load_tables  # noqa: F401
