"""Query/oracle registry package: one module per operator family.

The ordered registry itself lives in __spark_entry__.py (order is part of
the driver contract)."""
