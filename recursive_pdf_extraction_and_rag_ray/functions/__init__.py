"""Pure, deterministic per-record functions shared by the oracle and the
Ray stages. No Ray imports here — everything is plain Python / numpy and
safe to call row-at-a-time (oracle) or inside ``map_batches`` (engine)."""
