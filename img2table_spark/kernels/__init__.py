"""Pure-Python/NumPy kernels. No Spark imports here — everything in this
subpackage runs inside Arrow-batched pandas UDFs on executors and is unit
tested directly against the reference's own golden fixtures."""
