"""Domain solvers: pose-network bootstrap, bundle adjustment, intrinsics."""
