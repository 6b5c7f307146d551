from reffy_spark.extractors.base import (  # noqa: F401
    MODULES,
    extract_all,
    extract_page,
)
