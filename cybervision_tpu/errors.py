"""Error lattice mirroring the reference's per-module error enums.

The reference defines one error enum per module with `From` conversions
into `ReconstructionError` (reconstruction.rs:907-977,
fundamentalmatrix.rs:665-682, correlation/mod.rs:737-762,
triangulation.rs:2149-2166, output.rs:1239-1292); fatal errors bubble to
exit code 1 (main.rs:198-201). Python's exception hierarchy is the
idiomatic equivalent: every module error derives from
ReconstructionError, and the CLI catches the base class.

All classes also derive from ValueError/RuntimeError so pre-existing
callers (and user code) that catch the builtin types keep working.
"""


class ReconstructionError(RuntimeError):
    """Base class: any failure of the reconstruction pipeline
    (reconstruction.rs:907-977)."""


class ImageError(ReconstructionError, ValueError):
    """Image loading / metadata failure (reconstruction.rs:915-926)."""


class RansacError(ReconstructionError, ValueError):
    """Fundamental-matrix estimation failure
    (fundamentalmatrix.rs:665-682): not enough matches, or no reliable
    model found."""


class CorrelationError(ReconstructionError, ValueError):
    """Dense correlation failure (correlation/mod.rs:737-762)."""


class TriangulationError(ReconstructionError, ValueError):
    """Sparse/dense triangulation or pose-recovery failure
    (triangulation.rs:2149-2166)."""


class OutputError(ReconstructionError, ValueError):
    """Mesh/depth-map writing failure (output.rs:1239-1292): no point
    projections, unsupported extension, IO errors."""
