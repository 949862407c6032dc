//! Rust client for the eventql_tpu HTTP API.
//!
//! Reference surface: drivers/rust in 17ai/eventql ships only an empty
//! test stub; this crate provides a real std-only client (raw HTTP/1.1
//! over TcpStream, no dependencies). The response body is returned as
//! the raw JSON string — pair with your JSON library of choice.
//!
//! ```no_run
//! use eventql_tpu::Client;
//! let client = Client::new("127.0.0.1", 9175);
//! let json = client.query("select 1 + 2 as three;").unwrap();
//! // {"results": [{"type": "table", "columns": ["three"], "rows": [["3"]]}]}
//! ```

use std::io::{Read, Write};
use std::net::TcpStream;

pub struct Client {
    host: String,
    port: u16,
    pub database: Option<String>,
    pub auth_token: Option<String>,
}

#[derive(Debug)]
pub enum Error {
    Io(std::io::Error),
    Http { status: u16, body: String },
    Protocol(String),
}

impl From<std::io::Error> for Error {
    fn from(e: std::io::Error) -> Self {
        Error::Io(e)
    }
}

impl Client {
    pub fn new(host: &str, port: u16) -> Self {
        Client {
            host: host.to_string(),
            port,
            database: None,
            auth_token: None,
        }
    }

    /// Execute a SQL query; returns the raw JSON response body.
    pub fn query(&self, query: &str) -> Result<String, Error> {
        let mut body = format!(
            "{{\"query\": {}, \"format\": \"json\"",
            json_string(query)
        );
        if let Some(db) = &self.database {
            body.push_str(&format!(", \"database\": {}", json_string(db)));
        }
        body.push('}');
        self.post("/api/v1/sql", &body, 200)
    }

    /// Insert rows; `rows_json` is a JSON array of {table, data} objects.
    pub fn insert(&self, rows_json: &str) -> Result<String, Error> {
        self.post("/api/v1/tables/insert", rows_json, 201)
    }

    fn post(&self, path: &str, body: &str, want: u16) -> Result<String, Error> {
        let mut stream = TcpStream::connect((self.host.as_str(), self.port))?;
        let auth = match &self.auth_token {
            Some(t) => format!("Authorization: Token {}\r\n", t),
            None => String::new(),
        };
        let req = format!(
            "POST {} HTTP/1.1\r\nHost: {}:{}\r\nContent-Type: application/json\r\n{}Content-Length: {}\r\nConnection: close\r\n\r\n{}",
            path, self.host, self.port, auth, body.len(), body
        );
        stream.write_all(req.as_bytes())?;
        let mut raw = Vec::new();
        stream.read_to_end(&mut raw)?;
        let text = String::from_utf8_lossy(&raw);
        let mut parts = text.splitn(2, "\r\n\r\n");
        let head = parts.next().unwrap_or("");
        let body = parts.next().unwrap_or("").to_string();
        let status: u16 = head
            .split_whitespace()
            .nth(1)
            .and_then(|s| s.parse().ok())
            .ok_or_else(|| Error::Protocol("bad status line".into()))?;
        // tolerate chunked transfer encoding from keep-alive servers
        let body = if head.to_ascii_lowercase().contains("transfer-encoding: chunked") {
            dechunk(&body)
        } else {
            body
        };
        if status != want {
            return Err(Error::Http { status, body });
        }
        Ok(body)
    }
}

fn json_string(s: &str) -> String {
    let mut out = String::with_capacity(s.len() + 2);
    out.push('"');
    for c in s.chars() {
        match c {
            '"' => out.push_str("\\\""),
            '\\' => out.push_str("\\\\"),
            '\n' => out.push_str("\\n"),
            '\r' => out.push_str("\\r"),
            '\t' => out.push_str("\\t"),
            c if (c as u32) < 0x20 => out.push_str(&format!("\\u{:04x}", c as u32)),
            c => out.push(c),
        }
    }
    out.push('"');
    out
}

fn dechunk(body: &str) -> String {
    let mut out = String::new();
    let mut rest = body;
    loop {
        let Some(nl) = rest.find("\r\n") else { break };
        let Ok(len) = usize::from_str_radix(rest[..nl].trim(), 16) else {
            break;
        };
        if len == 0 {
            break;
        }
        let start = nl + 2;
        if rest.len() < start + len {
            break;
        }
        out.push_str(&rest[start..start + len]);
        rest = &rest[(start + len + 2).min(rest.len())..];
    }
    out
}

#[cfg(test)]
mod tests {
    use super::json_string;

    #[test]
    fn escapes_json_strings() {
        assert_eq!(json_string("a\"b\\c\n"), "\"a\\\"b\\\\c\\n\"");
    }
}
