"""gecoz-tpu: a TPU-native lossless genomic compression framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference Java toolkit (redmitry/gecoz): FASTA <-> `.gcz` FM-index
compression (suffix array -> BWT -> Huffman-shaped wavelet tree with
rank-indexed bit vectors + sampled suffix array), batched FM-index
count/locate/extract, a from-scratch deflate/gzip/BGZF codec, and
BAM/SAM readers — with block-level data parallelism over TPU meshes.
"""

__version__ = "0.1.0"
