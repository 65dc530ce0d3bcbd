"""Numeric kernels: geometry, search, solvers, descriptors.

These are the TPU-native replacements for the reference's L1-L3 layers
(nanoflann/PCL KD-trees, PCL filters/ICP, Ceres/GTSAM solvers — SURVEY.md §1).
"""
