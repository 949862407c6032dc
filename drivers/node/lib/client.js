'use strict';

const http = require('http');

const API_PATH = '/api/v1';

/**
 * eventql_tpu client.
 *
 *   const client = new Client('localhost', 9175, {
 *     database: 'default',        // optional
 *     authToken: '...',           // optional: Authorization: Token <t>
 *     user: '...', password: '…', // optional: basic auth
 *   });
 *   const res = await client.query('select 1;').execute();
 *   await client.insert([{table: 't', data: {a: 1}}]);
 */
class Client {
  constructor(host, port, opts = {}) {
    if (typeof host !== 'string') {
      throw new Error('Please provide host as string');
    }
    if (typeof port !== 'number') {
      throw new Error('Please provide port as a number');
    }
    this.host = host;
    this.port = port;
    this.database = opts.database || null;
    this.authToken = opts.authToken || null;
    this.user = opts.user || null;
    this.password = opts.password || null;
  }

  query(queryStr) {
    return new Query(this, queryStr);
  }

  insert(rows) {
    return this._post(`${API_PATH}/tables/insert`, rows).then((res) => {
      if (res.statusCode !== 201) {
        throw new Error(`HTTP ${res.statusCode}: ${res.body}`);
      }
    });
  }

  createTable(table, schema, primaryKey) {
    return this._post(`${API_PATH}/tables/create`, {
      table,
      schema,
      primary_key: primaryKey || [],
    }).then((res) => {
      if (res.statusCode !== 201) {
        throw new Error(`HTTP ${res.statusCode}: ${res.body}`);
      }
    });
  }

  _headers(extra = {}) {
    const headers = Object.assign(
      { 'Content-Type': 'application/json', Accept: 'application/json' },
      extra
    );
    if (this.authToken) {
      headers.Authorization = `Token ${this.authToken}`;
    } else if (this.user) {
      const cred = Buffer.from(`${this.user}:${this.password || ''}`);
      headers.Authorization = `Basic ${cred.toString('base64')}`;
    }
    return headers;
  }

  _post(path, body) {
    const json = JSON.stringify(body);
    return new Promise((resolve, reject) => {
      const req = http.request(
        {
          host: this.host,
          port: this.port,
          path,
          method: 'POST',
          headers: this._headers({
            'Content-Length': Buffer.byteLength(json),
          }),
        },
        (res) => {
          let data = '';
          res.setEncoding('utf8');
          res.on('data', (chunk) => (data += chunk));
          res.on('end', () =>
            resolve({ statusCode: res.statusCode, body: data })
          );
        }
      );
      req.on('error', reject);
      req.write(json);
      req.end();
    });
  }
}

class Query {
  constructor(client, queryStr) {
    if (typeof queryStr !== 'string') {
      throw new Error('The query must be a string');
    }
    this.client = client;
    this.queryStr = queryStr;
  }

  /** Resolves with the parsed {results: [...]} payload. */
  execute() {
    const postdata = { query: this.queryStr, format: 'json' };
    if (this.client.database) {
      postdata.database = this.client.database;
    }
    return this.client
      ._post(`${API_PATH}/sql`, postdata)
      .then((res) => {
        if (res.statusCode !== 200) {
          const err = new Error(res.body);
          err.code = res.statusCode;
          throw err;
        }
        return JSON.parse(res.body);
      });
  }

  /**
   * Streaming execution over the json_sse format.
   * handlers: {onProgress(p), onResult(r), onError(e)}
   */
  executeSSE(handlers = {}) {
    const params = new URLSearchParams({
      format: 'json_sse',
      query: this.queryStr,
    });
    if (this.client.database) {
      params.set('database', this.client.database);
    }
    return new Promise((resolve, reject) => {
      const req = http.request(
        {
          host: this.client.host,
          port: this.client.port,
          path: `${API_PATH}/sql?${params.toString()}`,
          method: 'GET',
          headers: this.client._headers({ Accept: 'text/event-stream' }),
        },
        (res) => {
          let buf = '';
          res.setEncoding('utf8');
          res.on('data', (chunk) => {
            buf += chunk;
            let idx;
            while ((idx = buf.indexOf('\n\n')) >= 0) {
              const frame = buf.slice(0, idx);
              buf = buf.slice(idx + 2);
              let event = 'message';
              const dataLines = [];
              for (const line of frame.split('\n')) {
                if (line.startsWith('event:')) {
                  event = line.slice(6).trim();
                } else if (line.startsWith('data:')) {
                  dataLines.push(line.slice(5).trim());
                }
              }
              const data = dataLines.join('\n');
              if (event === 'progress' && handlers.onProgress) {
                handlers.onProgress(data);
              } else if (event === 'result') {
                if (handlers.onResult) {
                  handlers.onResult(JSON.parse(data));
                }
              } else if (event === 'query_error' || event === 'error') {
                const err = new Error(data);
                if (handlers.onError) handlers.onError(err);
                reject(err);
              }
            }
          });
          res.on('end', resolve);
        }
      );
      req.on('error', reject);
      req.end();
    });
  }
}

module.exports = { Client, Query };
