from etl_data_spark.io.writers import (  # noqa: F401
    overwrite_by_window,
    write_partitioned,
)
