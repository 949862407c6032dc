'use strict';

// Node.js client for the eventql_tpu HTTP API.
// Reference surface: drivers/node in 17ai/eventql (Client/Query over
// /api/v1/sql + /api/v1/tables/insert). This implementation is
// dependency-free (SSE streaming is parsed inline) and Promise-based,
// with the same endpoints and auth headers as the python driver.

const { Client } = require('./client');

module.exports = { Client };
