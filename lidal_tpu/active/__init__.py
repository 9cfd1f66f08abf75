"""Active-selection scoring and greedy budgeted selection.

Frame-level metrics: RAND / ENT / MAR / CONF / SEGENT / CSET
(reference ``score/frame_level/*``).
Supervoxel-level metrics: RAND / ReDAL / LiDAL (reference ``score/sv_level/*``),
with LiDAL's inter-frame divergence/entropy computed by an on-device hash-grid
nearest-neighbor kernel instead of CPU KD-tree pools.
"""
