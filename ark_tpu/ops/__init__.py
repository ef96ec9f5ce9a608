"""TPU compute kernels (Pallas + XLA) for the framework's hot ops."""
