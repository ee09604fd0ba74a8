from .lookup import bucket_hashes_jnp, table_lookup
from .kmerize import rolling_pack_u32, assemble_kmers, canonical_select

__all__ = [
    "bucket_hashes_jnp",
    "table_lookup",
    "rolling_pack_u32",
    "assemble_kmers",
    "canonical_select",
]
