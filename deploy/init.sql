-- MySQL container first-boot init (parity: reference init.sql).
-- Tables are created by the app at startup (mec_tpu/database/db.py
-- MySQLDatabase._init_schema); this file only pins the charset.
ALTER DATABASE emotion_db CHARACTER SET utf8mb4 COLLATE utf8mb4_unicode_ci;
