"""SQLite-backed persistence (users, predictions, statistics).

Replaces the reference's SQLAlchemy ORM stack (reference
database/db_config.py, database/db_operations.py) with stdlib sqlite3 in
WAL mode — the service's only shared state, so it must be safe across the
webapp's worker threads. Passwords hash with scrypt (stdlib) instead of
bcrypt (not in this image); the check API is identical.
"""

from mec_tpu.database.db import (
    Database,
    User,
    Prediction,
    EmotionStatistic,
    ModelMetric,
    get_db,
    init_db,
    hash_password,
    check_password,
)

__all__ = ['Database', 'User', 'Prediction', 'EmotionStatistic',
           'ModelMetric', 'get_db', 'init_db', 'hash_password',
           'check_password']
