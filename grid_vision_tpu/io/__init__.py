"""I/O: synthetic scenes, visualization, sensor adapters."""
