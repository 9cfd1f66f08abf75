"""Execution drivers: train / evaluate / probability inference, checkpoints, paths."""
