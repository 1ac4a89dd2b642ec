"""gblastn_tpu: a TPU-native nucleotide BLAST (megablast/blastn) engine.

A from-scratch reimplementation of the capabilities of G-BLASTN
(GPU-accelerated NCBI BLAST fork) designed for TPUs: seeding, extension and
gapped scoring run as JAX/XLA/Pallas array programs over fixed-shape blocks;
traceback, E-value ranking and formatting run on host; multi-chip scaling
uses jax.sharding meshes over database shards.
"""

__version__ = "0.1.0"
