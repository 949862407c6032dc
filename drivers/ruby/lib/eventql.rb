# Ruby client for the eventql_tpu HTTP API.
# Reference surface: drivers/ruby in 17ai/eventql (Client + Query over
# /api/v1/sql and /api/v1/tables/insert).
require "eventql_client"
require "eventql_query"
