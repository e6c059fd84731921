from crawspark.sources.tables import TableBackend, get_backend, read_testdata  # noqa: F401
