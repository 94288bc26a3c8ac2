"""deepseek_ocr_vllm_spark — a from-scratch PySpark-native main-content
extraction engine with the data-processing capabilities of the reference
pipeline goldfish-inc/deepseek-ocr-vllm (surveyed in /root/repo/SURVEY.md).

Spark-first design: DataFrame/SQL plans optimized by Catalyst; the only
Python on the hot path is whole-batch Arrow UDFs (mapInArrow) for the
extraction transform itself.
"""

__version__ = "0.1.0"
