"""Auxiliary subsystems: native-kernel loading, profiling, logging, checkpointing."""
