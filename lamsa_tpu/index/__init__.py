from lamsa_tpu.index.kmer import KmerIndex  # noqa: F401
