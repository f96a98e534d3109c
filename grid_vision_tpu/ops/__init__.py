"""Fixed-shape masked XLA ops implementing the reference's hot loops."""
