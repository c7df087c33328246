"""Query plans: the operator-inventory query catalog (driver correctness
surface) and catalog/STAC-style metadata builders."""
