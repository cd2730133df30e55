"""TPU microbenchmarks and profiling scripts."""
