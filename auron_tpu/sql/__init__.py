"""SQL front-end (the engine's second front-end over the wire contract)."""

from auron_tpu.sql.compile import compile_sql, run_sql  # noqa: F401


def install_session_sql():
    """Attach Session.sql(text) -> DataFrame."""
    from auron_tpu.plan.execute import Session

    def sql(self, text: str):
        return run_sql(text, self)
    Session.sql = sql
    return Session


install_session_sql()
