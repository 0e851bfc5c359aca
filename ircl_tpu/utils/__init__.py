"""Runtime utilities: native build, checkpointing, logging, profiling."""
