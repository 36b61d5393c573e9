from smqtk_indexing_spark.functions import metrics, text  # noqa: F401
