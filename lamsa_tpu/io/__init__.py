from lamsa_tpu.io.fasta import read_fasta, read_fastx, FastxRecord  # noqa: F401
from lamsa_tpu.io.refpack import PackedReference  # noqa: F401
from lamsa_tpu.io.sam import SamRecord, sam_header, format_sam_record  # noqa: F401
