"""Pure-numpy kernels reproducing GDAL reference semantics bit-for-bit.

Each module cites the authoritative reference implementation
(file:line under /root/reference) whose observable behavior it
reproduces.  These kernels are the *oracle* for every golden test and
are also what executes inside Arrow pandas UDFs on executors — one
implementation, no drift between test oracle and production path.
"""
