"""gorillaspark — a PySpark-native time-series rollup/downsample/retention
engine with Gorilla (delta-of-delta + XOR) block compression.

Built from scratch against the format semantics of burmanm/gorilla-tsc
(see SURVEY.md); the execution engine is Spark DataFrame/Catalyst plus
vectorized Arrow/pandas UDFs — never a port of the reference's Java.
"""

__version__ = "0.1.0"
