from ocr_spark.fixtures.generator import ensure_fixtures, generate_tier  # noqa: F401
