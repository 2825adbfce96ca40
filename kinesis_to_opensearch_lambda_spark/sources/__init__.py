"""Sources: batch Parquet table loaders and the Kinesis-envelope
emulation used by streaming tests."""
