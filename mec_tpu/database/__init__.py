"""SQL persistence (users, predictions, statistics).

Replaces the reference's SQLAlchemy ORM stack (reference
database/db_config.py, database/db_operations.py) with stdlib sqlite3 in
WAL mode (default) or PyMySQL when DATABASE_URL is mysql:// — the service's only shared state, so it must be safe across the
webapp's worker threads. Passwords hash with scrypt (stdlib) instead of
bcrypt (not in this image); the check API is identical.
"""

from mec_tpu.database.db import (
    Database,
    MySQLDatabase,
    User,
    Prediction,
    EmotionStatistic,
    ModelMetric,
    get_db,
    make_database,
    parse_db_url,
    init_db,
    hash_password,
    check_password,
)

__all__ = ['Database', 'MySQLDatabase', 'User', 'Prediction', 'EmotionStatistic',
           'ModelMetric', 'get_db', 'make_database', 'parse_db_url', 'init_db', 'hash_password',
           'check_password']
