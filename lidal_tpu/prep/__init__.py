"""Offline preprocessing: pose registration, supervoxel partition, surface variation."""
