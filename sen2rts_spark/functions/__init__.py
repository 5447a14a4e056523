"""sen2rts_spark — PySpark-native time-series rollup engine."""
