from dere_spark.sources.documents import load_documents, load_table  # noqa: F401
