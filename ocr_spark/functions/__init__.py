"""Pure extraction kernels: pandas/numpy in, pandas/python out.

No ``pyspark`` imports here — these are the bodies of the vectorized UDFs in
``ocr_spark.operators`` and are unit-testable without a JVM.
"""
