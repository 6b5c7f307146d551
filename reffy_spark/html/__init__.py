from reffy_spark.html.dom import Element, parse_html  # noqa: F401
