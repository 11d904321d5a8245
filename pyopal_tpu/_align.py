"""Top-level ``align`` generator: multithreaded chunked database search.

Parity with the reference orchestrator
(``/root/reference/src/pyopal/_align.py:28-172``) with one TPU-first
divergence: ``threads=0`` (the default) no longer means
``os.cpu_count()`` — with an accelerator backend the fastest plan is a
single fused dispatch over the whole packed database (device-level
parallelism replaces host threads), so ``0`` means "let the framework
choose".  Explicit ``threads >= 2`` keeps the reference behavior: the
database is cut in chunks handed to a thread pool, with
``ordered``/``pool`` semantics preserved; results are identical either
way because chunking never changes scores and ``target_index`` is
always global.
"""

from __future__ import annotations

import contextlib
import functools
import multiprocessing.pool

from .aligner import Aligner
from .database import BaseDatabase, Database
from .matrices import ScoringMatrix


@contextlib.contextmanager
def nullcontext(enter_result):
    """Return a context manager that returns its input and does nothing."""
    yield enter_result


def align(
    query,
    database,
    scoring_matrix=None,
    *,
    gap_open: int = 3,
    gap_extend: int = 1,
    mode: str = "score",
    overflow: str = "buckets",
    algorithm: str = "sw",
    threads: int = 0,
    pool=None,
    ordered: bool = False,
):
    """Align the query sequence to every database sequence in parallel.

    Arguments:
        query (`str` or byte-like object): The sequence to query the
            database with.
        database (iterable of `str` or byte-like objects): The database
            sequences to align the query to.
        scoring_matrix (`~pyopal_tpu.ScoringMatrix` or `str`): The
            scoring matrix to use, as an object or a bundled-matrix
            name (default: BLOSUM50).

    Keyword Arguments:
        gap_open (`int`): The gap opening penalty.
        gap_extend (`int`): The gap extension penalty.
        mode (`str`): ``score`` (default), ``end`` or ``full``.
        overflow (`str`): ``simple`` or ``buckets`` (API parity; the
            32-bit TPU engines cannot overflow).
        algorithm (`str`): ``nw``, ``hw``, ``ov`` or ``sw``.
        threads (`int`): ``0`` (default) runs one fused device search;
            ``1`` uses the main thread; ``>= 2`` spawns a
            `multiprocessing.pool.ThreadPool` over database chunks.
        pool (`multiprocessing.pool.ThreadPool`): A running pool to
            reuse across calls; only used when ``threads >= 2``.
        ordered (`bool`): Whether the results should be yielded in
            database order (``imap``) instead of completion order
            (``imap_unordered``).

    Yields:
        `~pyopal_tpu.ScoreResult`: One result per target sequence, of
        the type matching ``mode``.

    Example:
        >>> targets = ["AACCGCTG", "ATGCGCT", "TTATTACG"]
        >>> for res in align("ACCTG", targets, gap_open=2, ordered=True):
        ...     print(res.score, targets[res.target_index])
        41 AACCGCTG
        31 ATGCGCT
        23 TTATTACG

    """
    # derive default parameters
    if scoring_matrix is None:
        scoring_matrix = Aligner._DEFAULT_SCORING_MATRIX
    elif isinstance(scoring_matrix, str):
        scoring_matrix = ScoringMatrix.from_name(scoring_matrix)
    elif not isinstance(scoring_matrix, ScoringMatrix):
        ty = type(scoring_matrix).__name__
        raise TypeError(f"expected str or ScoringMatrix, got {ty}")
    if not isinstance(database, BaseDatabase):
        database = Database(database, scoring_matrix.alphabet)

    # avoid using more threads than necessary
    if threads > len(database):
        threads = len(database) or 1

    aligner = Aligner(scoring_matrix, gap_open=gap_open, gap_extend=gap_extend)
    if threads in (0, 1):
        # single fused dispatch: device-level parallelism inside
        yield from aligner.align(
            query,
            database,
            mode=mode,
            overflow=overflow,
            algorithm=algorithm,
        )
    else:
        # reference-parity chunked thread pool
        if pool is None:
            pool_context = multiprocessing.pool.ThreadPool(threads)
        else:
            pool_context = nullcontext(pool)
        chunk_length = len(database) // threads
        with pool_context as pool:
            _align = functools.partial(
                aligner.align,
                query,
                database,
                mode=mode,
                overflow=overflow,
                algorithm=algorithm,
            )
            starts = range(0, len(database), chunk_length)
            if not ordered:
                chunk_hits = pool.imap_unordered(
                    lambda x: _align(start=x, end=x + chunk_length), starts
                )
            else:
                chunk_hits = pool.imap(
                    lambda x: _align(start=x, end=x + chunk_length), starts
                )
            for hits in chunk_hits:
                yield from hits
