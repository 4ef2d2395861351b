"""Typed public interface (parity with the reference's lab_1806_vec_db.pyi)."""

from typing import Sequence

__version__: str

Vector = Sequence[float]
Metadata = dict[str, str]
SearchResult = list[tuple[Metadata, float]]

def calc_dist(a: Vector, b: Vector, dist: str = "cosine") -> float:
    """Distance between two vectors.

    `dist` is "l2sqr" (squared Euclidean) or "cosine" (1 - cosine similarity,
    in [0, 2]; default, for RAG).

    Raises:
        ValueError: if the distance name is invalid.
    """

class VecDB:
    """Embedded multi-table vector database.

    Guarantees: background auto-save; thread-safe atomic operations; one
    manager per directory (flock-enforced); heavy work runs as batched TPU
    device calls with the GIL released.
    """

    def __init__(self, dir: str) -> None:
        """Open (creating if needed) the database directory."""

    def create_table_if_not_exists(
        self, key: str, dim: int, dist: str = "cosine", data_type: str = "float32"
    ) -> bool:
        """Create a table; returns False if it already existed.

        Raises:
            ValueError: if the distance name is invalid.
        """

    def get_len(self, key: str) -> int:
        """Number of vectors in the table."""

    def get_dim(self, key: str) -> int:
        """Vector dimension of the table."""

    def get_dist(self, key: str) -> str:
        """Distance function name of the table."""

    def delete_table(self, key: str) -> bool:
        """Delete a table (waits for pending work); False if absent."""

    def get_all_keys(self) -> list[str]:
        """All table names."""

    def contains_key(self, key: str) -> bool:
        """Whether a table exists."""

    def get_cached_tables(self) -> list[str]:
        """Table keys currently loaded in memory."""

    def contains_cached(self, key: str) -> bool:
        """Whether a table is currently loaded in memory."""

    def remove_cached_table(self, key: str) -> None:
        """Flush and evict a table from the in-memory cache."""

    def add(self, key: str, vec: Vector, metadata: Metadata) -> None:
        """Append one vector with metadata (keeps HNSW, clears PQ)."""

    def batch_add(self, key: str, vec_list: Sequence[Vector], metadata_list: Sequence[Metadata]) -> None:
        """Append many vectors with metadata (keeps HNSW, clears PQ)."""

    def delete(self, key: str, pattern: Metadata) -> int:
        """Delete rows whose metadata matches all pattern keys exactly.

        Clears HNSW and PQ (downgrades to Flat). Returns rows removed.
        """

    def search(
        self,
        key: str,
        query: Vector,
        k: int,
        ef: int | None = None,
        upper_bound: float | None = None,
    ) -> SearchResult:
        """k-NN search; (metadata, distance) pairs sorted by distance.

        Routing: ef given and PQ table present -> PQ-ADC search with exact
        rerank; ef given -> HNSW search with ef; else exact/default search.
        `upper_bound` filters out results with distance above it.
        """

    def batch_search(
        self,
        key: str,
        queries: Sequence[Vector],
        k: int,
        ef: int | None = None,
        upper_bound: float | None = None,
    ) -> list[SearchResult]:
        """TPU extension: search a whole batch in one device dispatch."""

    def extract_data(self, key: str) -> list[tuple[list[float], Metadata]]:
        """All (vector, metadata) rows of the table."""

    def build_hnsw_index(self, key: str, ef_construction: int | None = None) -> None:
        """Build an HNSW index over the table (no-op if already built)."""

    def clear_hnsw_index(self, key: str) -> None:
        """Drop the HNSW index (downgrades to Flat)."""

    def has_hnsw_index(self, key: str) -> bool:
        """Whether an HNSW index is built."""

    def build_pq_table(
        self,
        key: str,
        train_proportion: float | None = None,
        n_bits: int | None = None,
        m: int | None = None,
    ) -> None:
        """Train a PQ table (defaults: proportion 0.1, n_bits 4, m=ceil(dim/3)).

        Raises:
            ValueError: if arguments are out of range.
        """

    def clear_pq_table(self, key: str) -> None:
        """Drop the PQ table."""

    def has_pq_table(self, key: str) -> bool:
        """Whether a PQ table is built."""

    def force_save(self) -> None:
        """Synchronously flush all dirty state to disk."""

    def close(self) -> None:
        """Flush and release the directory lock (idempotent)."""

    def __enter__(self) -> "VecDB": ...
    def __exit__(self, *exc: object) -> None: ...
