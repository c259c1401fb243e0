"""Pure vectorized kernels (numpy / pyarrow / hashlib). No Ray imports here —
these are unit-testable in-process and shared by the Ray stages."""
