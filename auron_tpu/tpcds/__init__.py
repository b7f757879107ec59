"""TPC-DS harness: schemas, seeded data generator, hand-converted queries,
differential runner (the analog of the reference's dev/auron-it integration
suite, /root/reference/dev/auron-it/: QueryRunner + QueryResultComparator)."""
